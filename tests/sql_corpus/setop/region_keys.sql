-- groups: setop; tables: nation; ignoreOrder: false
SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 10
INTERSECT
SELECT n_regionkey FROM nation WHERE n_nationkey >= 5
ORDER BY k
