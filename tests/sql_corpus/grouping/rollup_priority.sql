-- groups: grouping; tables: orders; ignoreOrder: false
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
