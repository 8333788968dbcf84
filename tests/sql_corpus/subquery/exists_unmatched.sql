-- groups: subquery; tables: customer,orders; ignoreOrder: false
SELECT count(*) AS never_ordered
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
